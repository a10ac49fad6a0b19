"""Geodetic / orbital layer (ref src-core/common/geodetic + libs/predict).

Host-side math: TLE parsing, SGP4 propagation, coordinate transforms, look
angles. Per-pixel geolocation (raytracing scanlines over whole passes) is
batched NumPy/JAX in satdump_tpu.geo.raytrace.
"""

from satdump_tpu.geo.geodetic import (ecef_to_lla, eci_to_ecef, gmst,
                                      lla_to_ecef, look_angles)  # noqa: F401
from satdump_tpu.geo.tle import TLE  # noqa: F401
from satdump_tpu.geo.sgp4 import SGP4  # noqa: F401
