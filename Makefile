SF_SMALL ?= /root/testdata/sf0.001
SF_MED   ?= /root/testdata/sf0.01

.PHONY: test oracles oracles-small bench scaling hf-smoke

test:
	python -m pytest tests/ -q

oracles-small:
	python scripts/check_oracles.py $(SF_SMALL)

oracles:
	python scripts/check_oracles.py $(SF_MED)

bench:
	python bench.py

scaling:
	python bench.py --scaling

# A2/A1 HF smoke: fine-tune 1 epoch on 32 pseudo-labeled sentences, run the
# HF actor-pool tagger over the sf0.001 corpus head, report P/R/F1.  Runs
# green where torch+transformers exist; prints SKIP and exits 0 here.
# HF_SMOKE_MODEL=/path/to/pretrained asserts F1 >= 0.95 (HF_SMOKE_MIN_F1).
hf-smoke:
	python scripts/hf_smoke.py $(SF_SMALL)
