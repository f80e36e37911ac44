#!/bin/bash
set -x
timeout 1500 python bench.py
timeout 1800 python _tpu_stages6.py
