#!/usr/bin/env bash
# SRS fetcher (reference download_setup.sh parity).
#
# The reference pulls ceremony params for degrees 20/24/26 from S3. This
# environment has no egress, so by default this generates deterministic toy
# SRS files (INSECURE — test/bench only) in the same params{N} naming; point
# SRS_BASE_URL at a mirror of the ceremony files to fetch real ones.
set -euo pipefail

DEGREE="${SCROLL_PROVER_MAX_DEGREE:-26}"
PARAMS_DIR="${SCROLL_PROVER_PARAMS_DIR:-./params}"
mkdir -p "$PARAMS_DIR"

if [[ -n "${SRS_BASE_URL:-}" ]]; then
  for d in 20 21 24 25 26; do
    [[ "$d" -le "$DEGREE" ]] || continue
    echo "fetching params$d ..."
    curl -fL "$SRS_BASE_URL/params$d" -o "$PARAMS_DIR/params$d"
  done
else
  echo "no SRS_BASE_URL: generating toy SRS (INSECURE) up to 2^16"
  python - <<EOF
from scroll_prover_tpu.prover import load_params
for d in range(10, 17):
    load_params("$PARAMS_DIR", d)
    print(f"params{d} ready")
EOF
fi
