#!/usr/bin/env bash
# Prepare every N3V scene under $1 (the reference's preprocess_all_n3v.sh).
set -euo pipefail
root="${1:?usage: preprocess_all_n3v.sh <n3v_root>}"
for scene in coffee_martini cook_spinach cut_roasted_beef flame_salmon_1 flame_steak sear_steak; do
  [ -d "$root/$scene" ] || continue
  python "$(dirname "$0")/preprocess_n3v.py" --videopath "$root/$scene"
done
