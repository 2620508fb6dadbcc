#!/usr/bin/env bash
# Package release artifacts from an e2e output dir (reference release.sh).
# Usage: scripts/release.sh <output_dir> <release_dir>
set -euo pipefail
OUT="${1:?output dir}"
REL="${2:?release dir}"
mkdir -p "$REL"
for f in evm_verifier.yul evm_verifier.bin pi_bundle_recursion.data \
         proof_bundle_recursion.data; do
  cp -v "$OUT/$f" "$REL/" 2>/dev/null || echo "missing: $f"
done
cp -v "$OUT"/full_proof_*.json "$REL/" 2>/dev/null || true
# verifying keys + chunk protocol (reference release carries
# vk_{chunk,batch,bundle}.vkey and chunk.protocol)
if [ -n "${ASSETS_DIR:-}" ]; then
  cp -v "$ASSETS_DIR"/vk_*.vkey "$REL/" 2>/dev/null || echo "missing: vkeys"
fi
cp -v "$OUT"/*.protocol "$REL/" 2>/dev/null || true
( cd "$REL" && sha256sum * > sha256sum ) || true
echo "release packaged in $REL"
