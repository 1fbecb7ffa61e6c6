#!/usr/bin/env bash
# Download the SPE10 case-2a dataset used by the reference's large MGR
# examples (equivalent of scripts/download_spe10_case2a.sh there).
#
# NOTE: requires network egress (absent in this repo's CI image — the
# generated multiphysics sequence from scripts/generate_data.py stands
# in for offline testing).
set -euo pipefail

OUT=${1:-data/spe10case2a}
URL=${SPE10_URL:-https://zenodo.org/records/17471036/files/spe10case2a.tar.gz}

mkdir -p "${OUT}"
echo "fetching ${URL}"
curl -fL "${URL}" -o "${OUT}/spe10case2a.tar.gz"
tar -xzf "${OUT}/spe10case2a.tar.gz" -C "${OUT}" --strip-components=1
rm -f "${OUT}/spe10case2a.tar.gz"
echo "datasets extracted to ${OUT}"
