# Convenience targets (the reference builds with one g++ line, Makefile:4-5;
# XLA jits the device compute at run time; `make native` builds the
# host-side C++ image codec, which io/native_codec.py otherwise builds on
# first use).

.PHONY: test test-fast bench report parity smoke native

native:
	g++ -O3 -shared -fPIC -o smallvcm_tpu/native/libsvcmcodec.so \
		smallvcm_tpu/native/codec.cpp

test:
	python -m pytest tests/ -q

# CI profile: skips the compile-heavy sharded/multihost/supervisor/AD-FD
# tests (each slow test is a scaled-up flavor of coverage that also runs
# fast: sharding equality also runs at 8-dev in the graft dryrun, grad
# correctness also runs via the cheap pt FD check, the supervisor's units
# are covered by checkpoint tests).
test-fast:
	@python -c "import xdist" 2>/dev/null \
	    && python -m pytest tests/ -q -m "not slow" -n 2 \
	    || python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

report:
	python -m smallvcm_tpu.cli --report -i 10

parity:
	python scripts/parity_tpu.py --iters 10 --out PARITY.md

smoke:
	python -m smallvcm_tpu.cli -s 0 -a el -i 1 --resolution 128 128 -o /tmp/smoke.bmp
