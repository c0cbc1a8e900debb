"""EBSD pattern simulation: dictionary generation on-device.

The reference assumes dictionary patterns are simulated externally (its
data path starts at a premade ``.npy`` stack, reference data_module.py:70-78);
this package closes the loop natively: reflector tables from the crystal
structure, detector geometry, a batched kinematical Kikuchi-band renderer
that runs as one XLA program, and a Bloch-wave *dynamical* master-pattern
simulator (`sim.dynamical`) for physical band profiles — so
`index.py sample` → `index.py master`/`simulate` → `build` → `query`
needs no external tooling.
"""

from latice_tpu.sim.geometry import DetectorGeometry, pixel_directions
from latice_tpu.sim.calibrate import (
    ScanCalibration,
    calibrate_geometry,
    calibrate_scan_geometry,
)
from latice_tpu.sim.master import (
    directions_to_lambert,
    lambert_to_directions,
    make_kinematical_master,
    master_from_patterns,
    render_from_master,
    resample_square_lambert,
    square_lambert_to_directions,
)
from latice_tpu.sim.dynamical import (
    AtomSite,
    CrystalStructure,
    channeling_intensities,
    cubic_structure,
    dynamical_beams,
    dynamical_master_pattern,
    hexagonal_structure,
    wurtzite_structure,
    zincblende_structure,
)
from latice_tpu.sim.master_fit import (
    fit_reflectors_to_master,
    kinematical_master_ncc,
)
from latice_tpu.sim.montecarlo import (
    MonteCarloBSE,
    effective_medium,
    mc_weighted_master_pattern,
    simulate_bse_monte_carlo,
)
from latice_tpu.sim.refine import refine_candidates, refine_orientations
from latice_tpu.sim.kinematical import (
    Reflectors,
    cubic_reflectors,
    electron_wavelength,
    hexagonal_reflectors,
    reflectors_from_cell,
    simulate_patterns,
)

__all__ = [
    "AtomSite",
    "CrystalStructure",
    "DetectorGeometry",
    "ScanCalibration",
    "calibrate_geometry",
    "calibrate_scan_geometry",
    "channeling_intensities",
    "Reflectors",
    "cubic_reflectors",
    "cubic_structure",
    "dynamical_beams",
    "dynamical_master_pattern",
    "hexagonal_structure",
    "wurtzite_structure",
    "zincblende_structure",
    "directions_to_lambert",
    "electron_wavelength",
    "fit_reflectors_to_master",
    "hexagonal_reflectors",
    "kinematical_master_ncc",
    "lambert_to_directions",
    "make_kinematical_master",
    "mc_weighted_master_pattern",
    "MonteCarloBSE",
    "effective_medium",
    "simulate_bse_monte_carlo",
    "pixel_directions",
    "master_from_patterns",
    "render_from_master",
    "reflectors_from_cell",
    "refine_candidates",
    "refine_orientations",
    "resample_square_lambert",
    "simulate_patterns",
    "square_lambert_to_directions",
]
