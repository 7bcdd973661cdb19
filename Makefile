# Convenience targets; see README.md.
.PHONY: native test bench fuzz clean

native:
	$(MAKE) -C avrecode_tpu/host

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

fuzz:
	$(MAKE) -C avrecode_tpu/host fuzz
	ASAN_OPTIONS=detect_leaks=0 avrecode_tpu/host/fuzz_harness data/rt_tiny.mp4 1 200

clean:
	$(MAKE) -C avrecode_tpu/host clean
