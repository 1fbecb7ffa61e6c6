"""Linear-system layer: build/IO orchestration, scaling, diagnostics."""
