#!/bin/bash
set -x
timeout 1500 python bench.py
EX4DGS_GCHUNK=128 timeout 1500 python bench.py
timeout 1800 python _tpu_stages6.py
