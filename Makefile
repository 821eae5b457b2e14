# funscript-flow-tpu — build/test/bench entry points (reference had a Nuitka
# packaging Makefile; here the native piece is the C++ decode runtime and
# distribution is a plain wheel).

.PHONY: all native test test-fast bench clean wheel bundle

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
	python -m pip wheel --no-deps --no-build-isolation -w dist .

# Relocatable install bundle — the TPU-host counterpart of the reference's
# Nuitka frozen binaries (its Makefile): a tarball with the wheel, the
# prebuilt native runtime, and an offline installer. install.sh unpacks the
# wheel into ./lib via pip --target and writes a ./funscript-flow-tpu
# launcher that rides whatever python3 is on PATH — so the host's own
# JAX/libtpu is always used, never pinned into the artifact (README
# "Distribution"). No network access required.
bundle: native wheel
	rm -rf dist/bundle
	mkdir -p dist/bundle
	cp dist/funscript_flow_tpu-*.whl dist/bundle/
	cp funscript_flow_tpu/runtime/libframe_pump.so dist/bundle/ 2>/dev/null || true
	printf '%s\n' '#!/bin/sh -e' \
	  'here=$$(cd "$$(dirname "$$0")" && pwd)' \
	  'python3 -m pip install --no-deps --no-index --target "$$here/lib" "$$here"/funscript_flow_tpu-*.whl' \
	  '[ -f "$$here/libframe_pump.so" ] && cp "$$here/libframe_pump.so" "$$here/lib/funscript_flow_tpu/runtime/" || true' \
	  'printf "%s\n" "#!/bin/sh" "PYTHONPATH=\"$$here/lib:\$$PYTHONPATH\" exec python3 -m funscript_flow_tpu.cli \"\$$@\"" > "$$here/funscript-flow-tpu"' \
	  'chmod +x "$$here/funscript-flow-tpu"' \
	  'echo "Installed. Run: $$here/funscript-flow-tpu <video-or-folder>"' \
	  > dist/bundle/install.sh
	chmod +x dist/bundle/install.sh
	tar -C dist -czf dist/funscript-flow-tpu-bundle.tar.gz bundle
	@echo "dist/funscript-flow-tpu-bundle.tar.gz"

clean:
	$(MAKE) -C funscript_flow_tpu/runtime clean
	rm -rf dist build *.egg-info
