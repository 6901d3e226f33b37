from tpu_flash.cache.paged_cache import PagedKVCache, CacheConfig
