"""Pipeline stages: map_batches transforms and actor-pool classes."""
