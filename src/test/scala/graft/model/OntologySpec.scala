package graft.model

import graft.SparkSpec

/** The full ontology catalog's projection contract: every entity from the
  * reference's medical model (one sample instance each) must project to
  * (id, label, properties) with EVERY non-id field stringified into the
  * map — the same contract MedicalSpec pins for the original four. */
class OntologySpec extends SparkSpec {

  private def check[T <: Product : scala.reflect.runtime.universe.TypeTag](
      inst: T, label: String): Unit = {
    val ds = spark.createDataset(Seq(inst))(
      org.apache.spark.sql.Encoders.product[T])
    val row = Ontology.vertices(ds, label).collect().head
    assert(row.getString(1) == label)
    val props = row.getMap[String, String](2)
    val fields = inst.productElementNames.toSeq.filterNot(_ == "id")
    assert(props.keySet.toSet == fields.toSet,
      s"$label: ${props.keySet.toSet} != ${fields.toSet}")
    assert(props.values.forall(_ != null), s"$label: null property value")
  }

  test("all reference entities project with the stringified-property contract") {
    check(Ontology.Address("x", "x", Some("x"), "x", "x", "x", "x"), "Address")
    check(Ontology.BillingAddress(1, Some(1), Some("x"), Some("x"), Some("x"), Some("x"), Some("x")), "BillingAddress")
    check(Ontology.Claim(1, 1, 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.5f, 1.5f, "x"), "Claim")
    check(Ontology.ClinicalNote(1, 1, 1, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "ClinicalNote")
    check(Ontology.Department(1, 1, "x", "x", Some(1), Some("x"), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Department")
    check(Ontology.Diagnosis(1, 1, 1, 1, "x", java.sql.Date.valueOf("2024-01-01")), "Diagnosis")
    check(Ontology.Disposition(1, 1, 1, "x", Some("x"), Some(1), Some(1), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Disposition")
    check(Ontology.Doctor(1, "x", "x", "x", "x", "x", "x"), "Doctor")
    check(Ontology.Dosage(1, 1, "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))), "Dosage")
    check(Ontology.EdEvent(1, 1, "x", Some("x"), Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1), "EdEvent")
    check(Ontology.EdProcedure(1, 1, 1, 1, "x", 1, Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), Some("x"), Some("x")), "EdProcedure")
    check(Ontology.Encounter(1, 1, 1, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some("x")), "Encounter")
    check(Ontology.Event(1, 1, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"), "Event")
    check(Ontology.FacilityUnit(1, 1, "x", "x", Some(1), Some(1), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "FacilityUnit")
    check(Ontology.FHIRMessage(1, "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "x"), "FHIRMessage")
    check(Ontology.HL7Message(1, "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "x"), "HL7Message")
    check(Ontology.Hospital(1, "x", 1, Some("x"), Some("x"), Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Hospital")
    check(Ontology.Immunization(1, 1, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(1), Some("x")), "Immunization")
    check(Ontology.Insurance(1, "x", "x", Some("x"), "x"), "Insurance")
    check(Ontology.Login(1L, "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Login")
    check(Ontology.MasterPatientIndex(1, Some(1), Some("x"), Some("x"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), Some("x"), Some("x"), Some("x"), Some("x"), Some("x"), Some(1.5f), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "MasterPatientIndex")
    check(Ontology.MedicalCode(1, "x", "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "MedicalCode")
    check(Ontology.MedicalInteraction(1, 1, 1), "MedicalInteraction")
    check(Ontology.MedicalInteractionPrimary(1, 1, "x", "x", Some("x")), "MedicalInteractionPrimary")
    check(Ontology.MedicalInteractionSecondary(1, 1, 1, "x", Some("x")), "MedicalInteractionSecondary")
    check(Ontology.MedicalRecord(1, 1, 1, Some("x"), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "MedicalRecord")
    check(Ontology.Medication(1, "x", Some("x"), Some("x"), "x"), "Medication")
    check(Ontology.Nurse(1, 1, "x", Some("x"), 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Nurse")
    check(Ontology.Observation(1, 1, 1, "x", "x", Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1), "Observation")
    check(Ontology.Partner(1, "x", "x", Some(1), Some("x"), Some("x"), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Partner")
    check(Ontology.Patient(1, Some(1), "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x", Some("x"), Some("x"), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Patient")
    check(Ontology.PatientJourney(1, 1, 1, 1, Some(1), Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "PatientJourney")
    check(Ontology.Pharmacy(1, "x", Some("x"), Some("x"), Some("x"), Some("x")), "Pharmacy")
    check(Ontology.PharmacyIntegration(1, 1, 1, "x", Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))), "PharmacyIntegration")
    check(Ontology.Prescription(1, 1, 1, "x", "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))), "Prescription")
    check(Ontology.Refill(1, 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "x"), "Refill")
    check(Ontology.Registration(1L, "x", "x", "x", "x", "x", "x", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Registration")
    check(Ontology.Role(1L, "x", Seq("a", "b"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Role")
    check(Ontology.SideEffect(1, 1, "x", "x", Some("x"), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "SideEffect")
    check(Ontology.SocialDeterminant(1, 1, "x", Some("x"), Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "SocialDeterminant")
    check(Ontology.StaffAssignment(1, 1, 1, Some(1), Some(1), 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), true, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "StaffAssignment")
    check(Ontology.StateProvince(1, "x", "x", Some("x")), "StateProvince")
    check(Ontology.Triage(1, 1, 1, 1, "x", "x", Some("x"), Some(1), Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Triage")
    check(Ontology.User("x", "x", "x", "x", "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, Some("x"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))), "User")
    check(Ontology.Vitals(1, 1, Some(1.5f), Some(1.5f), Some(1), Some(1), Some(1.5f), Some(1), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "Vitals")
    check(Ontology.X12EDIMessage(1, "x", "x", "x", "x", "x", "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "x"), "X12EDIMessage")
  }

  test("catalog lists every vertex-projectable entity") {
    assert(Ontology.labels.size == 46)
    assert(Ontology.labels.distinct.size == Ontology.labels.size)
  }
}