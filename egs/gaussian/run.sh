#!/bin/bash
# gaussian recipe (reference: egs/gaussian/run.sh) — staged: 0 subset, 1 features,
# 2 train, 3 evaluate. Pass --stage/--stop-stage to select stages.
cd "$(dirname "$0")"
preset=${preset:-conf/gaussian_wavenet.json}
. ../run_common.sh "$@"
