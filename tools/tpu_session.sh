#!/bin/bash
# Full on-chip validation sequence — run SOLO (the axon tunnel serves one
# client; a second TPU process blocks). Each step bounded by timeout and
# logged to /tmp/tpu_*.log; steps ordered most-important-first so a relay
# death mid-sequence still leaves the headline artifacts.
set -x
cd "$(dirname "$0")/.."

( time timeout 590  python __graft_entry__.py )                    > /tmp/tpu_entry.log    2>&1
echo "rc=$?" >> /tmp/tpu_entry.log

( time timeout 1450 python bench.py )                              > /tmp/tpu_bench.log    2>&1
echo "rc=$?" >> /tmp/tpu_bench.log

( time timeout 900  python tools/bench_ml_mapper.py )              > /tmp/tpu_mlmapper.log 2>&1
echo "rc=$?" >> /tmp/tpu_mlmapper.log

( time timeout 1500 python tools/streaming_atlast_demo.py --duration 600 --block-tc 128 --group 8 ) > /tmp/tpu_atlast_stream.log 2>&1
echo "rc=$?" >> /tmp/tpu_atlast_stream.log

( time timeout 1200 python tools/streaming_memory_demo.py --tpu 600 1800 ) > /tmp/tpu_streaming.log 2>&1
echo "rc=$?" >> /tmp/tpu_streaming.log

( time timeout 900  python tools/bench_cmb_synthesis.py --scan )   > /tmp/tpu_cmb.log      2>&1
echo "rc=$?" >> /tmp/tpu_cmb.log

grep -h '^{' /tmp/tpu_bench.log /tmp/tpu_mlmapper.log /tmp/tpu_atlast_stream.log /tmp/tpu_streaming.log /tmp/tpu_cmb.log
