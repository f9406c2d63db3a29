"""map_batches stage functions / actor classes. No ray.init() here."""
