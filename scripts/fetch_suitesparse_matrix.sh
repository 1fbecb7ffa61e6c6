#!/usr/bin/env bash
# Fetch a SuiteSparse collection matrix and convert it to IJ binary
# parts (equivalent of the reference's scripts/fetch_suitesparse_matrix.sh).
#
#   ./fetch_suitesparse_matrix.sh <group> <name> [nparts] [outdir]
#   e.g. ./fetch_suitesparse_matrix.sh HB bcsstk14 4 data/bcsstk14
#
# NOTE: requires network egress (the CI image for this repo has none —
# there the in-tree generators, scripts/generate_data.py, stand in).
set -euo pipefail

GROUP=${1:?usage: fetch_suitesparse_matrix.sh <group> <name> [np] [outdir]}
NAME=${2:?matrix name required}
NP=${3:-1}
OUT=${4:-data/${NAME}}
URL="https://suitesparse-collection-website.herokuapp.com/MM/${GROUP}/${NAME}.tar.gz"

mkdir -p "${OUT}"
TMP=$(mktemp -d)
trap 'rm -rf "${TMP}"' EXIT

echo "fetching ${URL}"
curl -fL "${URL}" -o "${TMP}/${NAME}.tar.gz"
tar -xzf "${TMP}/${NAME}.tar.gz" -C "${TMP}"

MTX="${TMP}/${NAME}/${NAME}.mtx"
[ -f "${MTX}" ] || { echo "matrix market file not found"; exit 1; }

python -m hypredrive_tpu.tools.mat2ijbin "${MTX}" \
  --nparts "${NP}" --outdir "${OUT}/np${NP}"
echo "wrote ${OUT}/np${NP}"
