"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal plumbing.  All hot paths are built-in
Column expressions (JVM, whole-stage codegen); hashing is md5-prefix based so
every operator has a bit-identical ANSI-SQL oracle (DuckDB) for the
correctness gate."""
