"""Tracking & automation (ref src-core/common/tracking + src-cli autotrack).

Host-side: SGP4-driven az/el tracking, pass prediction, multi-satellite
scheduling, rotctld rotator protocol, Doppler computation.
"""

from satdump_tpu.tracking.tracker import (ObjectTracker, SatellitePass,
                                          predict_passes)  # noqa: F401
from satdump_tpu.tracking.scheduler import AutoTrackScheduler, TrackedObject  # noqa: F401
