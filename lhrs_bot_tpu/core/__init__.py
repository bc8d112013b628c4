from .config import ConfigArgumentParser, ConfigDict, load_yaml_config  # noqa: F401
from .dtypes import DTypePolicy, resolve_dtype  # noqa: F401
