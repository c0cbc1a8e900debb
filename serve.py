"""Shim: the serving CLI lives at latice_tpu.cli.serve (also installed as
the ``latice-serve`` console script)."""

from latice_tpu.cli.serve import *  # noqa: F401,F403
from latice_tpu.cli.serve import main  # noqa: F401

if __name__ == "__main__":
    main()
