"""Sources & sinks: synthetic fixture generators, CSV dictionary/corpus
readers, triple/TTL writers, checkpointed stage tables."""
