"""DVB-S2 pipeline modules (baseband -> bbframe -> ts)."""

import satdump_tpu.pipeline.modules.dvbs2.demod  # noqa: F401
import satdump_tpu.pipeline.modules.dvbs2.ts_extractor  # noqa: F401
