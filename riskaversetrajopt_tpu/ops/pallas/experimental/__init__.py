"""Experimental fused Pallas ADMM backends (measured toolchain ceiling
5-10x off peak; see README.md in this directory). Opt in via the
driver's '_admm-pallas' / '_admm-pallas-f' backend names."""
