"""Ray Data stage builders: map_batches UDFs and actor-pool classes."""
