"""Device compute ops: weighting, ramp filtering, backprojection."""

from .weighting import weight_map, apply_weights
from .filtering import ramp_kernel_real, ramp_filter_spectrum, filter_projections
from .backprojection_xla import backproject_chunk_xla, BpGrid, make_bp_grid
