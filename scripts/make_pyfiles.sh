#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f pylate_spark.zip
python -c "
import zipfile, pathlib
z = zipfile.ZipFile('pylate_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('pylate_spark').rglob('*.py')):
    z.write(p)
z.close()
print('wrote pylate_spark.zip')
"
