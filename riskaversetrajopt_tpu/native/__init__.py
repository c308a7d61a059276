"""ctypes bindings to the native C++ runtime components (native/*.cpp).

Builds on first use with g++ into build/ (no pybind11 dependency; plain C ABI
+ ctypes, per the environment's native-toolchain constraints)."""

from riskaversetrajopt_tpu.native.qp import solve_qp_native  # noqa: F401
