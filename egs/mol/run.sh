#!/bin/bash
# mol recipe (reference: egs/mol/run.sh) — staged: 0 subset, 1 features,
# 2 train, 3 evaluate. Pass --stage/--stop-stage to select stages.
cd "$(dirname "$0")"
preset=${preset:-conf/mol_wavenet.json}
. ../run_common.sh "$@"
