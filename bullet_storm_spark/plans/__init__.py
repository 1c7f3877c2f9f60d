"""Logical query plan layer: expression trees, the Query model, and the
compiler that lowers a Query to a Spark DataFrame transformation plus an
equivalent ANSI-SQL oracle string."""
