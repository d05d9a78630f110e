# fuzzycat_spark build / test / bench targets

.PHONY: test oracle bench scaling dist submit-local clean

test:
	python -m pytest tests/ -x -q

oracle:
	python tools/check_oracles.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python tools/bench_scaling.py

dist:
	mkdir -p dist
	cd . && python -c "import shutil; shutil.make_archive('dist/fuzzycat_spark', 'zip', '.', 'fuzzycat_spark')"

# run the spark-submit job locally end-to-end against a synthetic corpus
submit-local: dist
	python -c "\
import sys; sys.path.insert(0, '.'); \
from fuzzycat_spark import get_spark; \
from fuzzycat_spark.sources import synth_pages; \
s = get_spark(cores=8); s.sparkContext.setLogLevel('ERROR'); \
synth_pages(s, 200, 100).write.mode('overwrite').parquet('/tmp/submit_demo_pages')"
	spark-submit --master 'local[8]' --driver-memory 8g \
	  --py-files dist/fuzzycat_spark.zip jobs/dedup_job.py \
	  --input /tmp/submit_demo_pages --output /tmp/submit_demo_out \
	  --checkpoint /tmp/submit_demo_ckpt

clean:
	rm -rf dist /tmp/submit_demo_* .pytest_cache
