#!/bin/sh
# Rebuild jvm/tps-localfs.jar (no-op-chmod local filesystem; see
# src/tps/*.java).  Needs a JDK; compiles against pyspark's own
# bundled hadoop-client jars.
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf classes && mkdir -p classes
javac -classpath "$JARS/*" -d classes src/tps/*.java
jar cf tps-localfs.jar -C classes .
rm -rf classes
echo "built $(pwd)/tps-localfs.jar"
