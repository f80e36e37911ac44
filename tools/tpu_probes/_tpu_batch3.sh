#!/bin/bash
set -x
timeout 1200 python _tpu_unaligned.py
EX4DGS_ALIGN=0 timeout 1500 python bench.py
EX4DGS_BUFS=3 timeout 1500 python bench.py
EX4DGS_ALIGN=0 EX4DGS_BUFS=3 timeout 1500 python bench.py
timeout 1800 python _tpu_binstages.py
