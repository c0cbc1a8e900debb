"""Shim: the indexing CLI lives at latice_tpu.cli.index (also installed as
the ``latice-index`` console script)."""

from latice_tpu.cli.index import *  # noqa: F401,F403
from latice_tpu.cli.index import _load_model, main  # noqa: F401

if __name__ == "__main__":
    main()
