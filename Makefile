# Convenience targets (the reference builds with one g++ line, Makefile:4-5;
# XLA jits the device compute at run time; `make native` builds the
# host-side C++ image codec, which io/native_codec.py otherwise builds on
# first use).

.PHONY: test bench report parity smoke native

native:
	g++ -O3 -shared -fPIC -o smallvcm_tpu/native/libsvcmcodec.so \
		smallvcm_tpu/native/codec.cpp

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
