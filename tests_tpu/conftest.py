"""On-TPU suite configuration: enable the persistent compilation cache
so repeated runs (and bench.py afterwards) reload programs in seconds
instead of re-paying the tunneled backend's 3-5 min compiles."""

from cusdr_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
