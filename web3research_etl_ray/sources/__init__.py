"""Source adapters: land external CDC wire formats into the engine's
canonical parquet stream layout (events-*.parquet + rollbacks.parquet),
then `pipelines.replay` runs unchanged with its full pruning machinery.
"""
