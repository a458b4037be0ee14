# Convenience targets.
.PHONY: test bench native clean

test:
	python -B -m pytest tests/ -q

bench:
	python -B bench.py

native:
	$(MAKE) -C dss_tpu/native

clean:
	$(MAKE) -C dss_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
