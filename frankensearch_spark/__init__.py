"""frankensearch_spark — PySpark-native lexical search engine (BM25 / inverted index)."""
