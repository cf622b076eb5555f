#!/usr/bin/env bash
# Reference-compatible launcher: real-data elastic inversion — point
# --dataroot at an fwi-prep'd tree (e.g. from --su-obs DENISE data).
set -e
cd "$(dirname "$0")/.."
python -m physicsbasedfwi2_tpu.engine.train --workload marmousi_elastic --netG AutoRealData "$@"
