"""Multi-device / multi-host scaling: shard_map index builds with
collective-stitched boundary state."""
