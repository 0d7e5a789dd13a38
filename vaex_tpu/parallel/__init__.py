"""Multi-chip parallelism: meshes, sharded passes, collective grid merges."""
