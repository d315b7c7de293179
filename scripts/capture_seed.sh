#!/bin/bash
# Capture the exact .jax_cache file set the default TPU bench uses into the
# committed .jax_cache_seed (or $SEED_DIR), by parsing JAX's persistent-cache
# hit/write debug log from one (ideally warm) bench run. Run AFTER the last
# code change that touches traced programs; commit the seed afterwards.
set -e
cd "$(dirname "$0")/.."
DEST=${SEED_DIR:-.jax_cache_seed}
LOG=$(mktemp)
JAX_DEBUG_LOG_MODULES=jax._src.compiler,jax._src.compilation_cache \
    python bench.py 2> "$LOG"
echo "bench output above; parsing $LOG"
mkdir -p "$DEST"
# "cache hit for 'name' with key 'KEY'" and "Writing name ... with key 'KEY'"
grep -oE "key '[^']+'" "$LOG" | sed "s/key '//; s/'//" | sort -u > /tmp/seed_keys
n=0
while read -r key; do
  src=".jax_cache/${key}-cache"
  if [ -f "$src" ]; then
    cp -f "$src" "$DEST/${key}-cache"
    n=$((n+1))
  fi
done < /tmp/seed_keys
echo "seeded $n executables; total size:"
du -sh --apparent-size "$DEST"
