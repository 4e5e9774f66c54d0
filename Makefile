# vitsom-tpu — make targets preserving the reference CLI semantics
# (reference Makefile:18-25): `make train model=vit_som dataset=mnist`

PY ?= python

train:
	PYTHONPATH=./:$$PYTHONPATH $(PY) experiments/benchmarking/train_$(model).py --config configs/$(model)/$(model)_$(dataset).yaml $(ARGS)

test:
	PYTHONPATH=./:$$PYTHONPATH $(PY) experiments/tests/test_$(model).py --config configs/$(model)/$(model)_$(dataset).yaml

unit-test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
