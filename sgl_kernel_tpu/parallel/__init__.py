"""Distributed layer: device meshes, shardings, collectives, ring attention."""
