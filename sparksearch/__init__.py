"""sparksearch — a from-scratch PySpark-native full-text index + BM25 engine.

Re-expresses the computation of Iris-Song/Web-Search-Engines (single-node C++
search engine: tokenize -> inverted index -> delta+varbyte blocked compression ->
lexicon/doc-table -> BM25 conjunctive/disjunctive top-k -> snippets) as idiomatic
Spark DataFrame plans plus a small set of vectorized Arrow/pandas UDFs.

Not a port: the reference's buffered spill runs / external merge sort / mmap
random access are replaced by Spark's shuffle, range partitioning, and columnar
predicate-pushdown scans.  See SURVEY.md for the full operator mapping.
"""

__version__ = "0.1.0"
