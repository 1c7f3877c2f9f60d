"""Sources: batch parquet table loading (the driver's synthetic tables) and
the DSL-style ingestion chain (connector -> deserializer -> converter) for
arbitrary inputs."""
