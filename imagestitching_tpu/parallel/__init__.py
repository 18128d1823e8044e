"""Parallel execution: device meshes, sharded tiles, vmapped batch serving."""
