"""Numeric kernels and containers: host CSR, device ELL/SpMV, vectors."""
