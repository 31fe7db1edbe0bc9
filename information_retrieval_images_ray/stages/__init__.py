"""map_batches stage callables (stateless fns + stateful actor classes)."""
