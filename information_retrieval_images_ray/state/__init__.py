"""Build-state management: checkpoint manifest, lineage, resume."""
