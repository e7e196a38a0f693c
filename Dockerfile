# Container image for the Spark collector — operational parity with the
# reference image, whose CMD chains build_database && build_s3_storage &&
# main (python/Dockerfile:28). Here the whole chain is one Spark driver
# (graft.Collector): JDBC schema bootstrap, sink self-test probe, then
# the polling archive tail.
#
# Build the thin library jar first (the Spark base image supplies the
# runtime jars, matching the build's unmanagedBase=/opt/spark/jars):
#
#   sbt package
#   docker build -t graft-collector .
#
# Run with the reference's compose environment block (BUCKET_NAME,
# CORE_DIRECTORY, NETWORK_PASSPHRASE, KIN_ISSUER, FIRST_FILE,
# MAX_RETRIES, and either S3_STORAGE_BUCKET[+S3_STORAGE_KEY_PREFIX] or
# POSTGRES_HOST+PYTHON_PASSWORD — see Deploy.scala):
#
#   docker run --env-file collector.env graft-collector
#
# For live S3 archives add the AWS bundle and credentials, e.g.:
#   --packages org.apache.hadoop:hadoop-aws:<hadoop.version>
#   -c spark.hadoop.fs.s3a.aws.credentials.provider=...
# (MIGRATION.md documents the full s3a recipe; the JDBC sink needs the
# PostgreSQL driver jar on the classpath the same way.)

# The base image's Spark version MUST match the Spark the jar was
# compiled against (this build links unmanagedBase=/opt/spark/jars,
# Spark 4.1.2) — a runtime older than the compile target fails with
# NoSuchMethodError at startup. Override SPARK_IMAGE if your registry
# tags differ.
ARG SPARK_IMAGE=apache/spark:4.1.2-scala2.13-java17-ubuntu
FROM ${SPARK_IMAGE}

COPY target/scala-2.13/historycollectorspark_2.13-0.1.0.jar /opt/app/collector.jar

# ENTRYPOINT carries only the fixed part; master, extra --packages/-c
# flags, and the jar live in CMD so `docker run graft-collector
# --master spark://... --packages org.apache.hadoop:hadoop-aws:...
# /opt/app/collector.jar` can override them. local[*] single-node is
# the default, mirroring the reference's one container = one collector;
# point --master at a cluster to scale the backfill decode horizontally
# (the tail's offset contract stays sequential by design).
ENTRYPOINT ["/opt/spark/bin/spark-submit", "--class", "graft.Collector"]
CMD ["--master", "local[*]", "/opt/app/collector.jar"]
