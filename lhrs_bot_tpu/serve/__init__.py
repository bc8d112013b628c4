from .engine import GenerationConfig, GenerationEngine  # noqa: F401
from .scheduler import ContinuousBatchingScheduler, Request  # noqa: F401
from .paged import PagedScheduler, PageAllocator  # noqa: F401
