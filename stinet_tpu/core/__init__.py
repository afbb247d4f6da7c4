from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import Registry
