package graft

class CorpusPipelineSpec extends SparkSpec {

  test("corpus pipeline funnel is monotone and ends with packed sequences") {
    val f = CorpusPipeline.run(spark, sfDir)
    assert(f.input === 500)
    // each stage can only remove documents
    assert(f.quality <= f.input)
    assert(f.exactDedup <= f.quality)
    assert(f.nearDedup <= f.exactDedup)
    assert(f.decontaminated < f.nearDedup) // the eval slice at least is cut
    assert(f.sampled <= f.decontaminated)
    // the mix keeps only the targeted strata, and something survives
    assert(f.sampled > 0 && f.sequences > 0)
    // packing can't emit more sequences than docs
    assert(f.sequences <= f.sampled)
  }
}
