"""Scale-out layer: channel × time-block sharding over TPU meshes
(SURVEY.md §5 'distributed communication backend' — the TPU-native answer)."""

from satdump_tpu.parallel.timeshard import (  # noqa: F401
    build_sharded_qpsk_step,
    make_mesh,
    shard_input,
)
