# One-command round evidence (VERDICT r7 item 8). Each target is a thin
# alias for the canonical script so there is exactly one implementation.
.PHONY: test audit bench plans evidence wrap

test:
	python -m pytest tests/ -q

# dual-scale (sf0.01 + sf0.1) replay of EVERY registered oracle
audit:
	python docs/audit_oracles.py

bench:
	python bench.py

plans:
	python docs/plans/dump_plans.py

# the full round bundle: suite, dual-scale oracle audit, bench JSON
evidence: test audit bench

# Round-close hygiene (VERDICT r15 item 4: three consecutive rounds shipped
# with driver artifacts uncommitted at judge time). Stages every driver
# artifact the round produced, commits if anything was staged, then FAILS
# on any remaining dirt so a forgotten file can't ride past the judge.
# Run as the round's final act: `make wrap`.
wrap:
	git add -A BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL.json \
	    BASELINE.json VERDICT.md ADVICE.md 2>/dev/null || true
	@if ! git diff --cached --quiet; then \
	    git commit -m "Commit round-close driver artifacts"; \
	fi
	@if [ -n "$$(git status --porcelain)" ]; then \
	    echo "wrap: working tree still dirty:" >&2; \
	    git status --short >&2; \
	    exit 1; \
	fi
	@echo "wrap: clean"
