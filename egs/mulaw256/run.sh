#!/bin/bash
# mulaw256 recipe (reference: egs/mulaw256/run.sh) — staged: 0 subset, 1 features,
# 2 train, 3 evaluate. Pass --stage/--stop-stage to select stages.
cd "$(dirname "$0")"
preset=${preset:-conf/mulaw256_wavenet.json}
. ../run_common.sh "$@"
