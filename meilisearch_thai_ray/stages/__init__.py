"""map_batches stage callables. Classes = actor pools (state built once per
actor in __init__); plain functions = stateless tasks."""
