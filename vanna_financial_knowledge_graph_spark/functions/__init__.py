"""Pure, deterministic functions shared by the single-node oracle and the
Spark Arrow UDFs. Nothing in this package may import pyspark: the whole point
is that the exact same bytes-in/bytes-out logic runs on the driver (to build
golden fixtures) and inside executors (via mapInPandas), which is what makes
the byte-identity invariant testable."""
