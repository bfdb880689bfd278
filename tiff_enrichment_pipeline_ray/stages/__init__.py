"""Ray Data stages: stateless ``map_batches`` transforms + actor-pool classes."""
