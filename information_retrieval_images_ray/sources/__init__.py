"""Dataset sources: corpus readers + dense doc-id assignment."""
