"""paris_tpu — TPU-native cone-beam CT (FDK) reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++/CUDA framework (hzdr/PARIS): HIS projection ingest, FDK
cosine weighting, FFT ramp filtering, voxel-driven filtered
backprojection over z-subvolumes, ddbvf output — single chip to
multi-host TPU pod slices.
"""

from .exceptions import (
    ParisError,
    StageConstructionError,
    StageRuntimeError,
)
from .geometry import (
    DetectorGeometry,
    VolumeGeometry,
    RegionOfInterest,
    SubvolumeInfo,
    ZBlock,
    derive_volume_geometry,
    apply_roi,
    plan_z_blocks,
    detector_row_band,
    filter_size_for,
)

__version__ = "0.1.0"
