"""Indexing CLI — dictionary build + batch pattern indexing.

The reference only shipped this flow as notebooks (notebook/index.ipynb,
index_faiss.ipynb — SURVEY §2 #16); here it is a first-class command:

    # build a dictionary database from simulated patterns + angles
    python index.py build --patterns dict.npy --angles angles.txt \
        --checkpoint checkpoints/best --db latent_index.npz

    # index unknown patterns against it
    python index.py query --patterns scan.npy --db latent_index.npz \
        --checkpoint checkpoints/best --out orientations.npy

    # multi-phase: one --patterns/--angles pair per phase + its point group;
    # query then also writes <out>_phase.npy
    python index.py build --patterns fcc.npy --angles fcc.txt \
        --patterns hcp.npy --angles hcp.txt --phase-groups 432,622 \
        --checkpoint checkpoints/best --db mp_index.npz
"""

from __future__ import annotations

import argparse
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)

# Back-compat re-exports: the root `index.py` shim, serve.py and user code
# import these from this module (the pre-split single-file surface).
from latice_tpu.cli._analyze_cmds import cmd_analyze  # noqa: E402,F401
from latice_tpu.cli._band_cmds import (  # noqa: E402,F401
    cmd_hough,
    cmd_quality,
)
from latice_tpu.cli._common import (  # noqa: E402,F401
    _load_model,
    _load_raw_pattern_stack,
)
from latice_tpu.cli._db_cmds import (  # noqa: E402,F401
    cmd_build,
    cmd_export,
    cmd_query,
)
from latice_tpu.cli._di_cmds import cmd_di  # noqa: E402,F401
from latice_tpu.cli._sim_cmds import (  # noqa: E402,F401
    cmd_master,
    cmd_sample,
    cmd_simulate,
)
from latice_tpu.cli._sphere_cmds import cmd_sphere  # noqa: E402,F401
from latice_tpu.cli._strain_cmds import (  # noqa: E402,F401
    cmd_calibrate,
    cmd_strain,
)


def main() -> None:
    """Parse argv and dispatch to the per-command modules (`cli/_*_cmds.py`
    own their command functions AND their parser blocks; this hub only
    assembles them — VERDICT r4 #8's no-monolith refactor)."""
    from latice_tpu.cli import (
        _analyze_cmds,
        _band_cmds,
        _db_cmds,
        _di_cmds,
        _sim_cmds,
        _sphere_cmds,
        _strain_cmds,
    )

    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--checkpoint", default=None, help="orbax params dir")
    common.add_argument("--db", default="latent_index.npz")
    common.add_argument("--inplanes", type=int, default=32)
    common.add_argument("--latent-dim", type=int, default=16)
    common.add_argument("--batch-size", type=int, default=256)

    for mod in (
        _db_cmds,      # build / export / query
        _di_cmds,      # di
        _band_cmds,    # quality / hough
        _sphere_cmds,  # sphere
        _strain_cmds,  # strain / calibrate
        _analyze_cmds, # analyze
        _sim_cmds,     # sample / simulate / master
    ):
        mod.register(sub, common)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
