"""Physical index layer: posting codec, partitioned segments, manifests, WAND."""
