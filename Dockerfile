# Container packaging parity with the reference relay
# (/root/reference/Dockerfile: golang build stage -> alpine run stage,
# `CMD prometheus_remote_kinesis -stream-name $STREAM_NAME`).
#
# Spark form: build the thin application jar with sbt, run it on a Spark
# base image (the Spark jars play the role of the static Go binary's
# stdlib). NOTE: this sandbox has no network/daemon to build images — the
# file documents the shippable container story; tools/run_relay.sh is the
# same entrypoint runnable directly.

### build stage
FROM sbtscala/scala-sbt:eclipse-temurin-17.0.10_7_1.10.0_2.13.17 AS build-env
ADD . /build
WORKDIR /build
RUN sbt -batch package

### run image
FROM apache/spark:4.1.2-java17
COPY --from=build-env /build/target/scala-2.13/*.jar /opt/graft/graft.jar
COPY tools/run_relay.sh /opt/graft/run_relay.sh

ENV AWS_REGION=ap-northeast-1
ENV SPARK_HOME=/opt/spark
ARG STREAM_NAME

# same shape as the reference CMD: relay from the body dir to the sink,
# serving remote-write POSTs on 9501
CMD ["/bin/bash", "-c", "java -cp /opt/graft/graft.jar:$SPARK_HOME/jars/* graft.streaming.RelayMain --in /data/bodies --out /data/sink --listen-addr 9501 --stream-name ${STREAM_NAME:-metrics}"]
