"""Mesh construction, overlap-save halo exchange, channel sharding."""
