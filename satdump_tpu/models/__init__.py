"""Per-mission decoders/instruments (the reference's plugins/*_support analog).

Importing this package registers all mission modules.
"""

import satdump_tpu.models.noaa_apt  # noqa: F401
import satdump_tpu.models.metop  # noqa: F401
import satdump_tpu.models.meteor  # noqa: F401
import satdump_tpu.models.noaa_hrpt  # noqa: F401
import satdump_tpu.models.meteor_hrpt  # noqa: F401
import satdump_tpu.models.goes_gvar  # noqa: F401
import satdump_tpu.models.goes_grb  # noqa: F401
import satdump_tpu.models.goes_sd  # noqa: F401
import satdump_tpu.models.jpss  # noqa: F401
import satdump_tpu.models.eos  # noqa: F401
import satdump_tpu.models.fengyun3  # noqa: F401
import satdump_tpu.models.radiosonde  # noqa: F401
import satdump_tpu.models.orbcomm  # noqa: F401
