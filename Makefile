# One-command round evidence (VERDICT r7 item 8). Each target is a thin
# alias for the canonical script so there is exactly one implementation.
.PHONY: test audit bench plans evidence

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
