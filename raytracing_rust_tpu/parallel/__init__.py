"""Multi-chip / multi-host sharding of renders and gradients."""
