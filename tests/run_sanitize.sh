#!/bin/sh
# Run the native host runtime under ASan+UBSan.
# Equivalent of the reference's -DCMAKE_USE_SANITIZERS build+run
# (reference CMakeLists.txt:39-45).
#
# Scope: the native-touching paths that do NOT enter jaxlib's jit —
# LD_PRELOADed ASan is incompatible with jaxlib's nanobind exception
# machinery (its __cxa_throw interceptor CHECK-fails inside
# mlir module_import during tracing), so device-kernel tests cannot run
# under ASan in this environment.  All native entry points are covered
# by tests/test_native_sanitize.py's subprocess driver plus the unicode
# and oracle differential suites below.
set -e
cd "$(dirname "$0")/.."
make -C wordpiece_tpu/runtime/native sanitize
ASAN=$(g++ -print-file-name=libasan.so)
WORDPIECE_TPU_NATIVE_SO=libwordpiece_host_san.so \
LD_PRELOAD="$ASAN" \
ASAN_OPTIONS=detect_leaks=0 \
JAX_PLATFORMS=cpu \
python -m pytest tests/test_unicode.py tests/test_oracle.py \
  tests/test_native_sanitize.py::test_sanitizer_run -q "$@"
