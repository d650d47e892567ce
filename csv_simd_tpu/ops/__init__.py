"""Device ops: classification, quote-parity scan, bitmask packing,
offset compaction, and the fused Pallas stage-1 kernel."""
