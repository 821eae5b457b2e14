# funscript-flow-tpu — build/test/bench entry points (reference had a Nuitka
# packaging Makefile; here the native piece is the C++ decode runtime and
# distribution is a plain wheel).

.PHONY: all native test test-fast bench clean wheel

all: native

native:
	$(MAKE) -C funscript_flow_tpu/runtime

test: native
	python -m pytest tests/ -x -q

# dev loop: skips the marked golden/e2e tests (~2 min vs ~30)
test-fast:
	python -m pytest tests/ -m "not slow" -x -q

bench: native
	python bench.py

wheel:
	python -m pip wheel --no-deps -w dist .

clean:
	$(MAKE) -C funscript_flow_tpu/runtime clean
	rm -rf dist build *.egg-info
