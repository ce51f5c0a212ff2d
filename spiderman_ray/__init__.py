"""spiderman_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the query/data-processing capabilities of
TurboWay/spiderman (a scrapy-redis distributed crawler, reference at
/root/reference) on top of ``ray.data.Dataset`` pipelines:

- the Redis FIFO request queue  -> per-generation frontier Datasets (BFS loop)
- the Redis dupefilter / bloom  -> sharded seen-set actor pool (exact + bloom,
  bit-compatible with the reference hash family in SP/bloom_dupefilter.py)
- scrapy downloader+middlewares -> fetch actor pool (map_batches, politeness,
  robots, deterministic retries)
- item pipelines / RDBMS sinks  -> columnar table store (Lance if available,
  partitioned Parquet otherwise)

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
