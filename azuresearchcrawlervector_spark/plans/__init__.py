"""Plans: the iterative frontier engine + snapshot checkpointing."""
