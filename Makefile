# One-command entry points for the round checklist. The sf0.1 mirror is
# first-class here because it keeps catching bugs the sf0.01 gate cannot
# reach (r6: microsecond session-gap boundary; PSI smoothing bias) — run
# `make mirror` before closing a round.

PY ?= python
SF01 ?= /root/testdata/sf0.01
SF10 ?= /root/testdata/sf0.1

.PHONY: test verify mirror mirror-test bench plans

test:            ## full pytest suite at the default (sf0.001) lake
	$(PY) -m pytest tests/ -x -q

verify:          ## driver-contract strict oracle sweep at sf0.01 (~6 min)
	$(PY) scripts/drive_entry.py

mirror:          ## 10x strict oracle sweep at sf0.1 (~25 min) — round-close gate
	SF_DIR=$(SF10) $(PY) scripts/drive_entry.py

mirror-test:     ## full pytest suite against the sf0.1 lake (oracle parity sweeps 10x data)
	SPARK_GRAFT_TEST_SF_DIR=$(SF10) $(PY) -m pytest tests/ -x -q

bench:           ## headline bench at $(SF10) — one JSON line
	# Local re-runs should pin the round so the committed BENCH_FULL_r{N}
	# record can't collide with the driver's (e.g. `make bench ROUND=12`).
	# Unset, bench.py infers the round from the newest CORRECTNESS file's
	# mtime (fresh → same round, stale → next round).
	$(if $(ROUND),SPARK_GRAFT_ROUND=$(ROUND)) $(PY) bench.py

plans:           ## regenerate PLANS.md (plan-shape audit over the registry)
	$(PY) scripts/plan_report.py
