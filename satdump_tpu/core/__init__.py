from satdump_tpu.core.config import Config, get_config  # noqa: F401
from satdump_tpu.core.exceptions import SatdumpError  # noqa: F401
from satdump_tpu.core.log import logger  # noqa: F401
from satdump_tpu.core.registry import Registry  # noqa: F401
from satdump_tpu.core.events import EventBus, event_bus  # noqa: F401
