#!/bin/bash
# CROSS-PROCESS OCC RACE (round-12 verdict item 3): launch two real JVMs
# racing CommitLog.claim + publishExclusive on the same version id of
# the same table directory, and assert exactly one winner with the
# loser's state equal to the winner's (the version is committed exactly
# once). The in-JVM thread race in CommitLogSpec cannot prove this —
# O_EXCL atomicity across PROCESSES is the production claim.
#
# Usage: tools/occ_race.sh [rounds]   (default 3)
set -u
cd "$(dirname "$0")/.."
ROUNDS=${1:-3}
FAIL=0
for r in $(seq 1 "$ROUNDS"); do
  DIR=$(mktemp -d /tmp/graft_occ_race_XXXX)
  ./run_verify.sh graft.Run occ-race "$DIR" 7 > "$DIR/a.log" 2>&1 &
  PA=$!
  ./run_verify.sh graft.Run occ-race "$DIR" 7 > "$DIR/b.log" 2>&1 &
  PB=$!
  # wait until both JVMs are spinning on the GO file, then fire
  for i in $(seq 1 200); do
    grep -q READY "$DIR/a.log" 2>/dev/null && grep -q READY "$DIR/b.log" 2>/dev/null && break
    sleep 0.2
  done
  touch "$DIR/_GO"
  wait $PA; EA=$?
  wait $PB; EB=$?
  WINS=$(cat "$DIR/a.log" "$DIR/b.log" | grep -c WINNER)
  echo "round $r: exits=($EA,$EB) winners=$WINS"
  if [ "$WINS" -ne 1 ]; then
    echo "round $r: FAIL — expected exactly one winner"; FAIL=1
  fi
  if { [ "$EA" -eq 0 ] && [ "$EB" -eq 0 ]; } || { [ "$EA" -ne 0 ] && [ "$EB" -ne 0 ]; }; then
    echo "round $r: FAIL — expected exit codes {0, 3}, got ($EA,$EB)"; FAIL=1
  fi
  if [ ! -f "$DIR/v=7/_COMMITTED" ]; then
    echo "round $r: FAIL — winner's version not committed"; FAIL=1
  fi
  if ls "$DIR"/v=7._CLAIM >/dev/null 2>&1; then
    echo "round $r: FAIL — claim file left behind"; FAIL=1
  fi
done
if [ "$FAIL" -eq 0 ]; then echo "occ_race: PASS ($ROUNDS rounds, one winner each)"; fi
exit $FAIL
