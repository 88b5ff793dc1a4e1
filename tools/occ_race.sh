#!/bin/bash
# CROSS-PROCESS OCC RACE (round-12 verdict item 3; N-writer form
# round-13 item 7): launch N real JVMs racing CommitLog.claim +
# publishExclusive on version ids of the same table directory — some
# processes SHARE an id (a duel: exactly one winner, losers exit 3 with
# state equal to the winner's), some hold DISTINCT ids (every one must
# win). Arrivals are STAGGERED by a per-process random delay (production
# contention, not just a synchronized barrier). The in-JVM thread race
# in CommitLogSpec cannot prove this — O_EXCL atomicity across
# PROCESSES is the production claim.
#
# Audits per round:
#   * exactly one WINNER per distinct id;
#   * exit codes: one 0 per id, 3 for every loser, nothing else;
#   * every raced id ends committed exactly once (_COMMITTED marker);
#   * no claim file leaks;
#   * releaseStaleClaims-style end state: the directory holds only
#     committed version dirs (janitor-clean).
#
# Usage: tools/occ_race.sh [rounds] [writers] [maxDelayMs]
#   defaults: 3 rounds, 5 writers (ids 7,7,7,8,9 — a 3-way duel plus
#   two uncontended), 40 ms max stagger.
set -u
cd "$(dirname "$0")/.."
ROUNDS=${1:-3}
WRITERS=${2:-5}
DELAY=${3:-40}
FAIL=0
for r in $(seq 1 "$ROUNDS"); do
  DIR=$(mktemp -d /tmp/graft_occ_race_XXXX)
  declare -a PIDS=() IDS=()
  for w in $(seq 1 "$WRITERS"); do
    # first ceil(W/2) writers duel on id 7; the rest get distinct ids 8,9,...
    if [ "$w" -le $(( (WRITERS + 1) / 2 )) ]; then ID=7; else ID=$((7 + w - (WRITERS + 1) / 2)); fi
    IDS+=("$ID")
    ./run_verify.sh graft.Run occ-race "$DIR" "$ID" "$DELAY" > "$DIR/w$w.log" 2>&1 &
    PIDS+=($!)
  done
  # wait until every JVM is spinning on the GO file, then fire
  for i in $(seq 1 300); do
    READY=$(grep -l READY "$DIR"/w*.log 2>/dev/null | wc -l)
    [ "$READY" -eq "$WRITERS" ] && break
    sleep 0.2
  done
  touch "$DIR/_GO"
  declare -a EXITS=()
  for p in "${PIDS[@]}"; do wait "$p"; EXITS+=($?); done
  DISTINCT=$(printf '%s\n' "${IDS[@]}" | sort -un)
  NDISTINCT=$(echo "$DISTINCT" | wc -l)
  WINS=$(cat "$DIR"/w*.log | grep -c WINNER)
  echo "round $r: writers=$WRITERS ids=(${IDS[*]}) exits=(${EXITS[*]}) winners=$WINS"
  if [ "$WINS" -ne "$NDISTINCT" ]; then
    echo "round $r: FAIL — expected exactly $NDISTINCT winners (one per distinct id)"; FAIL=1
  fi
  for id in $DISTINCT; do
    IDWINS=$(cat "$DIR"/w*.log | grep -c "WINNER.*id=$id$")
    if [ "$IDWINS" -ne 1 ]; then
      echo "round $r: FAIL — id $id has $IDWINS winners"; FAIL=1
    fi
    if [ ! -f "$DIR/v=$id/_COMMITTED" ]; then
      echo "round $r: FAIL — id $id not committed"; FAIL=1
    fi
  done
  NZERO=$(printf '%s\n' "${EXITS[@]}" | grep -c '^0$')
  NLOSER=$(printf '%s\n' "${EXITS[@]}" | grep -c '^3$')
  if [ "$NZERO" -ne "$NDISTINCT" ] || [ $((NZERO + NLOSER)) -ne "$WRITERS" ]; then
    echo "round $r: FAIL — exit codes must be $NDISTINCT zeros + losers all 3, got (${EXITS[*]})"; FAIL=1
  fi
  if ls "$DIR"/v=*._CLAIM >/dev/null 2>&1; then
    echo "round $r: FAIL — claim file left behind"; FAIL=1
  fi
  # janitor-clean end state: nothing under DIR except committed v= dirs
  # and the GO/log files this harness wrote
  STRAY=$(ls "$DIR" | grep -v '^v=' | grep -v '^_GO$' | grep -v '^w[0-9]*\.log$' | wc -l)
  if [ "$STRAY" -ne 0 ]; then
    echo "round $r: FAIL — stray entries: $(ls "$DIR" | grep -v '^v=' | grep -v '^_GO$' | grep -v '\.log$')"; FAIL=1
  fi
done
if [ "$FAIL" -eq 0 ]; then
  echo "occ_race: PASS ($ROUNDS rounds x $WRITERS writers, one winner per id, staggered arrivals)"
fi
exit $FAIL
