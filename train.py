"""Shim: the training CLI lives at latice_tpu.cli.train (also installed as
the ``latice-train`` console script)."""

from latice_tpu.cli.train import *  # noqa: F401,F403
from latice_tpu.cli.train import main, set_random_seeds, train  # noqa: F401

if __name__ == "__main__":
    main()
