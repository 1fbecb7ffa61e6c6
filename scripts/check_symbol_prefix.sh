#!/usr/bin/env bash
set -euo pipefail

# Verify that every *defined, global* symbol in the native shim library
# uses an approved prefix (HYPREDRV_ / hypredrv_ / hdrv_), so the shared
# object never pollutes a host application's namespace (equivalent of
# the reference's scripts/check_symbol_prefix.sh contract).
#
# Usage: scripts/check_symbol_prefix.sh [path-to-.so ...]
# Default targets: native/libhypredrv_io.so native/libhypredrv_tpu.so

libs=("$@")
if [ ${#libs[@]} -eq 0 ]; then
  libs=(native/libhypredrv_io.so native/libhypredrv_tpu.so)
fi

status=0
for lib in "${libs[@]}"; do
  if [ ! -f "$lib" ]; then
    echo "skip (not built): $lib"
    continue
  fi
  # defined global symbols of function/object type, demangling off;
  # allow the dynamic-linker boilerplate (_init/_fini/_edata/...)
  bad=$(nm -D --defined-only "$lib" | awk '{print $3}' \
        | grep -vE '^(HYPREDRV_|hypredrv_|hdrv_|_init$|_fini$|_edata$|_end$|__bss_start$)' \
        | grep -vE '^_Z' || true)
  if [ -n "$bad" ]; then
    echo "FAIL: unprefixed global symbols in $lib:"
    echo "$bad" | sed 's/^/  /'
    status=1
  else
    echo "OK: $lib exports only prefixed symbols"
  fi
done
exit $status
