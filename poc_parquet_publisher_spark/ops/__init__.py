"""Large-scale training-data pipeline operators (SURVEY.md section 2.4).

Every operator here is designed for the 100 TB regime first:

- dedup: exact hashing and fingerprinting are single-shuffle groupBys;
  near-dup goes through shingle/LSH *blocking* so no O(n^2) pair
  enumeration ever materializes.
- similarity: brute-force cosine is the correctness baseline (broadcast of
  the small query side only); the scale path is LSH bucketing so candidate
  generation is an equi-join.
- text: all scoring is built-in JVM expressions (no Python in the hot
  path) -- one narrow projection, no shuffle.
- multimodal: binary payloads ride as opaque BinaryType columns with typed
  metadata; decode runs in Arrow-batched mapInPandas so bytes never take
  the row-at-a-time pickle path.
- sampling: dataset splits are a pure hash of the key -- reproducible
  across runs, engines, and scales, unlike RNG-based df.sample.
"""
