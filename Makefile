# Convenience targets (the reference builds with one g++ line, Makefile:4-5;
# here there is nothing to compile — XLA jits the compute at run time).

.PHONY: test bench report parity smoke

test:
	python -m pytest tests/ -q

bench:
	python bench.py

report:
	python -m smallvcm_tpu.cli --report -i 10

parity:
	python scripts/parity_tpu.py --iters 10 --out PARITY.md

smoke:
	python -m smallvcm_tpu.cli -s 0 -a el -i 1 --resolution 128 128 -o /tmp/smoke.bmp
