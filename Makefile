# Convenience targets (see .claude/skills/verify/SKILL.md for env notes)

.PHONY: test test-all bench fit fit-quick native table

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m ""        # include slow posterior tests

bench:
	python bench.py

fit:
	python -m joxsz_tpu.run

fit-quick:
	python -m joxsz_tpu.run --cpu --quick

native:
	$(MAKE) -C native/tablegen

table: native
	python -m joxsz_tpu.tablegen.generate \
	  --rmf /root/reference/data/X/source.rmf \
	  --arf /root/reference/data/X/source.arf \
	  --z 0.888 --nh 0.0183 --out data/tables/cl1226_ctrate.npz
