"""Built-in processing modules. Importing this package registers them all."""

import satdump_tpu.pipeline.modules.demod  # noqa: F401
import satdump_tpu.pipeline.modules.ccsds  # noqa: F401
import satdump_tpu.pipeline.modules.dvbs2  # noqa: F401
import satdump_tpu.pipeline.modules.network  # noqa: F401
import satdump_tpu.xrit.goes  # noqa: F401
import satdump_tpu.pipeline.modules.xrit_net  # noqa: F401
import satdump_tpu.xrit.gk2a  # noqa: F401
import satdump_tpu.xrit.geo  # noqa: F401
import satdump_tpu.pipeline.modules.convert  # noqa: F401
import satdump_tpu.pipeline.modules.inmarsat  # noqa: F401
import satdump_tpu.pipeline.modules.analog  # noqa: F401
