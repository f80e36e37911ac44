#!/bin/bash
# Sequential TPU measurement batch (single python process at a time)
set -x
timeout 1800 python _tpu_packvjp.py none scatter segmm
timeout 1800 python _tpu_stages6.py
timeout 1800 python _tpu_preproc.py
timeout 1200 python bench.py
EX4DGS_PAIR=4 timeout 1200 python bench.py
