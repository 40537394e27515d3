# Task surface (≙ the reference's pixi tasks, `pixi.toml:35-41`)

.PHONY: test test-fast bench verify-installation test-imports native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_geometry.py tests/test_equivalences.py \
	  tests/test_filter_units.py tests/test_pallas_kernels.py -q

bench:
	python bench.py

# import every third-party dependency (`pixi.toml:37`)
verify-installation:
	python -c "import jax, flax, numpy, scipy, pandas; print('deps OK')"

# import every first-party module (`pixi.toml:38`)
test-imports:
	python -c "import msckf_tpu, msckf_tpu.config, msckf_tpu.runner, \
	  msckf_tpu.filter.msckf, msckf_tpu.filter.state, msckf_tpu.filter.propagation, \
	  msckf_tpu.filter.augmentation, msckf_tpu.filter.matching, \
	  msckf_tpu.filter.verification, msckf_tpu.filter.update, \
	  msckf_tpu.filter.marginalization, msckf_tpu.filter.tracks, \
	  msckf_tpu.ops.geometry, msckf_tpu.ops.camera, msckf_tpu.ops.triangulation, \
	  msckf_tpu.ops.smallmat, msckf_tpu.ops.pallas_kernels, msckf_tpu.ops.precision, \
	  msckf_tpu.models.xfeat, msckf_tpu.models.frontend, \
	  msckf_tpu.models.selfsup, msckf_tpu.models.train_xfeat, \
	  msckf_tpu.parallel.batched, msckf_tpu.parallel.multihost, \
	  msckf_tpu.parallel.xfeat_sharded, msckf_tpu.data.rendered, \
	  msckf_tpu.data.synthetic, \
	  msckf_tpu.data.photorealistic, msckf_tpu.data.parser, msckf_tpu.data.stream, \
	  msckf_tpu.data.native_io, msckf_tpu.utils.metrics, msckf_tpu.utils.viz, \
	  msckf_tpu.utils.checkpoint, msckf_tpu.utils.consistency; print('imports OK')"

native:
	$(MAKE) -C msckf_tpu/native

clean:
	$(MAKE) -C msckf_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
