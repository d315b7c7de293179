#!/bin/bash
# Capture the exact .jax_cache file set the default TPU bench uses into the
# committed .jax_cache_seed, by parsing JAX's persistent-cache hit/write
# debug log from one (ideally warm) bench run. Run AFTER the last code
# change that touches traced programs; commit .jax_cache_seed afterwards.
set -e
cd "$(dirname "$0")/.."
LOG=$(mktemp)
JAX_DEBUG_LOG_MODULES=jax._src.compiler,jax._src.compilation_cache \
    python bench.py 2> "$LOG"
echo "bench output above; parsing $LOG"
mkdir -p .jax_cache_seed
# "cache hit for 'name' with key 'KEY'" and "Writing name ... with key 'KEY'"
grep -oE "key '[^']+'" "$LOG" | sed "s/key '//; s/'//" | sort -u > /tmp/seed_keys
n=0
while read -r key; do
  src=".jax_cache/${key}-cache"
  if [ -f "$src" ]; then
    cp -f "$src" ".jax_cache_seed/${key}-cache"
    n=$((n+1))
  fi
done < /tmp/seed_keys
echo "seeded $n executables; total size:"
du -sh .jax_cache_seed
