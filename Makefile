# funscript-flow-tpu — build/test/bench entry points (reference had a Nuitka
# packaging Makefile; here the native piece is the C++ decode runtime and
# distribution is a plain wheel).

.PHONY: all native test test-fast bench clean wheel

all: native

native:
	$(MAKE) -C funscript_flow_tpu/runtime

test: native
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/test_signal_host.py tests/test_aux.py \
	    tests/test_worker_cli.py tests/test_streaming.py -x -q

bench: native
	python bench.py

wheel:
	python -m pip wheel --no-deps -w dist .

clean:
	$(MAKE) -C funscript_flow_tpu/runtime clean
	rm -rf dist build *.egg-info
