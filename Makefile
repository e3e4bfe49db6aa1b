.DEFAULT_GOAL := help
.PHONY: test test_fast test_train deps help bench

help:
	@grep -E '^[a-zA-Z_-]+:.*?## .*$$' $(MAKEFILE_LIST) | sort | awk 'BEGIN {FS = ":.*?## "}; {printf "\033[36m%-16s\033[0m %s\n", $$1, $$2}'

deps:  ## install the package editable
	pip install -e . --no-build-isolation --no-deps

test:  ## run the full test suite (CPU, 8 virtual devices)
	python -m pytest tests/ -q -rs

test_fast:  ## run the fast tests only
	python -m pytest tests/ -q -rs -m "not slow"

test_train:  ## run the end-to-end train smoke tests
	python -m pytest tests/ -q -rs -m "slow"

bench:  ## run the TPU benchmark (one JSON line per metric; RTF last)
	python bench.py
